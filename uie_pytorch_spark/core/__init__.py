"""Pure-NumPy kernel math shared by the Spark UDFs and the eager test
oracle. No Spark imports allowed in this subpackage — everything here
runs inside executor Python workers via Arrow batches."""
