from mimic_spark.streaming.apply import TranscriptCdc  # noqa: F401
from mimic_spark.streaming.changefeed import ChangeFeedConsumer  # noqa: F401
