from spinix_spark.streaming.detect_stream import stream_detect

__all__ = ["stream_detect"]
