from mapreduce511_spark.sources.tables import TABLES, load_table, load_tables
from mapreduce511_spark.sources.text_logs import read_text_ordered

__all__ = ["TABLES", "load_table", "load_tables", "read_text_ordered"]
