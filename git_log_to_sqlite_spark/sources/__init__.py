"""Source connectors beyond the built-in readers.

``gitlog`` — a PySpark Python Data Source (Spark 4 DataSource API) so
``spark.read.format("gitlog").load(dir)`` streams parsed commits with
one input partition per repository log file. Registration is explicit:

    from git_log_to_sqlite_spark.sources import register_gitlog_source
    register_gitlog_source(spark)
"""

from .gitlog_source import GitLogDataSource, register_gitlog_source

__all__ = ["GitLogDataSource", "register_gitlog_source"]
