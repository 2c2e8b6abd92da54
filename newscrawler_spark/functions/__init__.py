"""Frozen scalar contracts: each module exposes a pure-Python spec
function (used by the oracle and the corpus generator) and a Spark
implementation (column expressions where possible, vectorized pandas
UDFs otherwise) that is tested byte-identical to the spec."""
