from reddit_sse_stream_spark.plans.catalog import QUERIES, QueryDef

__all__ = ["QUERIES", "QueryDef"]
