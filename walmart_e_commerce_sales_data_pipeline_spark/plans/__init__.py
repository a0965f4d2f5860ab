from .explain import (  # noqa: F401
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    single_partition_funnels,
    unpartitioned_windows,
    wholestage_codegen_spans,
)
from .metrics import execution_count, metrics_since  # noqa: F401
