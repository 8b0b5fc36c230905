from spinix_spark.io.pages import synthesize_pages, PAGES_SCHEMA
from spinix_spark.io.geoparse import geoparse_points

__all__ = ["synthesize_pages", "PAGES_SCHEMA", "geoparse_points"]
