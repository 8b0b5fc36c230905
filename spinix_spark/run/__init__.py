from spinix_spark.run.checkpoint import ChunkedRunner

__all__ = ["ChunkedRunner"]
