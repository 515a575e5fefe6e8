from mimic_spark.streaming.apply import TranscriptCdc  # noqa: F401
