"""Training-data pipeline operators (beyond the reference's scope):
deduplication, similarity search, text analysis, multimodal plumbing.
All Spark-first: built-in expressions where possible, Arrow-batched
pandas UDFs only where unavoidable.
"""
