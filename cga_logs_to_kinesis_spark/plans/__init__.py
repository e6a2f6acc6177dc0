from cga_logs_to_kinesis_spark.plans.guards import (  # noqa: F401
    DoubleEvaluationWarning,
    cheap_front,
    is_cheap_front,
)
from cga_logs_to_kinesis_spark.plans.inspect import (  # noqa: F401
    formatted_plan,
    has_pushed_filters,
    scan_read_schema_columns,
    uses_broadcast_join,
    uses_sort_merge_join,
    wholestage_codegen_spans,
)
