from mimic_spark.sinks.export import export_published, export_table  # noqa: F401
from mimic_spark.sinks.load import (  # noqa: F401
    DeliveryContractError,
    load_table,
    manifest_schema,
)
