from mimic_spark.sinks.export import export_published, export_table  # noqa: F401
