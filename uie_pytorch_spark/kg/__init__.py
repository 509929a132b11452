"""Knowledge-graph layers the reference lacks (north-rule additions):
entity canonicalization (normalize + MinHash LSH + connected
components), graph materialization (entities/edges/triples tables),
and per-partition lineage with checkpoint resume."""
