from mimic_spark.plans.explain import (  # noqa: F401
    assert_no_row_python,
    has_broadcast_join,
    physical_plan,
    plan_facts,
    pushed_filters,
)
