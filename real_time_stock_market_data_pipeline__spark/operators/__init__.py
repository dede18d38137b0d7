"""Relational / dataflow operators (SURVEY.md §2.3–§2.6, §2.10).

Each module re-expresses one operator family from the reference as
composable DataFrame functions, plus the north-star LLM-data-pipeline
extensions (dedup family, similarity search, text analysis, multimodal
plumbing). Operators never ``collect()`` and keep the hot path on
JVM built-ins; Pandas UDFs appear only where built-ins genuinely cannot
express the semantics (multimodal decode).
"""
