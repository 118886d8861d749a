from cs6913_web_search_engines_spark.functions import bm25, tokenizer, varbyte

__all__ = ["bm25", "tokenizer", "varbyte"]
