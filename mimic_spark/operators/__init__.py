from mimic_spark.operators.catalog import OPS, QueryOp, load_tables, register  # noqa: F401

# importing these modules populates the registry
from mimic_spark.operators import relational  # noqa: F401,E402
from mimic_spark.operators import windows  # noqa: F401,E402
from mimic_spark.operators import text  # noqa: F401,E402
from mimic_spark.operators import dedup  # noqa: F401,E402
from mimic_spark.operators import similarity  # noqa: F401,E402
from mimic_spark.operators import multimodal  # noqa: F401,E402
from mimic_spark.operators import skew  # noqa: F401,E402
from mimic_spark.operators import cdc_flagship  # noqa: F401,E402
