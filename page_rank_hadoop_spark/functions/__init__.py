from page_rank_hadoop_spark.functions import hashing, text, vectors

__all__ = ["hashing", "text", "vectors"]
