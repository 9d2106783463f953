"""LLM-data-pipeline operators: dedup, similarity search, text analysis, multimodal.

These extend the reference's surface per the project north star (BASELINE.json),
each designed for 100 TB: single-shuffle groupings, broadcastable dimensions,
JVM-side expressions in hot paths, Arrow-batched UDFs where Python is unavoidable.
"""
