"""spinix-spark: a PySpark-native geospatial rules-matching + tiling engine.

From-scratch reimplementation of the capabilities of mmadfox/spinix (a Go
geofencing rules engine) as a distributed spatial-join pipeline over
Common-Crawl-style web-page tables. Not a port: the reference's indexed
point-lookup execution (engine.go:190-225) is re-expressed as set-oriented
DataFrame joins; its cluster layer (internal/cluster/) is replaced wholesale
by Spark shuffle partitioning + AQE.
"""

__version__ = "0.1.0"
