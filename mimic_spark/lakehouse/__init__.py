from mimic_spark.lakehouse.table import CommitConflict, SnapshotTable  # noqa: F401
from mimic_spark.lakehouse.merge import MergeResult, merge_into  # noqa: F401
