"""Operator library: relational helpers and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

All operators take and return DataFrames, never collect data to the
driver, and are written so the shuffle structure survives a 100×
scale-up (see each module's notes).
"""
