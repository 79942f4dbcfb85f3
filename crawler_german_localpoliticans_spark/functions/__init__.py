"""Pure row-level semantics. No Spark imports here.

Every function in this subpackage is deterministic and side-effect free; the
Spark engine wraps them in vectorized pandas UDFs (functions/udfs.py) and the
single-threaded oracle (plans/oracle.py) calls them directly, so an
engine-vs-oracle mismatch can only come from orchestration, never from row
semantics.
"""
