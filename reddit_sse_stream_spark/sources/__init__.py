from reddit_sse_stream_spark.sources.tables import TABLES, load_table, register_views
from reddit_sse_stream_spark.sources.feed import FEED_CTE, feed_df

__all__ = ["TABLES", "load_table", "register_views", "FEED_CTE", "feed_df"]
