"""Column-level function library for training-data pipelines over the
documents/embeddings tables: text analysis, similarity search, multimodal
plumbing. All hot-path kernels are built-in column expressions or
Arrow-batched pandas UDFs."""
