from mimic_spark.functions.hashing import (  # noqa: F401
    bucket_expr,
    deterministic_row_id,
    salted_key,
)
from mimic_spark.functions.normalize import (  # noqa: F401
    normalize_text_py,
    normalize_text_udf,
)
