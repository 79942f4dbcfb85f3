"""DataFrame-level operators: web-scale dedup, similarity search, text
analysis, ledger analytics, multimodal plumbing.

These extend the reference's pipeline with the operations a 100 TB
training-data pipeline needs (dedup, ANN, quality scoring) — all declarative
DataFrame plans first, pandas UDFs only where built-ins genuinely cannot
express the semantics (simhash bit votes, rolling-hash fingerprints).
"""
