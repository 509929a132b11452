"""Sources & sinks: web-page corpus (the north-rule input table),
annotation readers (doccano / Label Studio), and fixture generators."""
