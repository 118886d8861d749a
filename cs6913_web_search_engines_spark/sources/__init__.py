from cs6913_web_search_engines_spark.sources import webpages

__all__ = ["webpages"]
