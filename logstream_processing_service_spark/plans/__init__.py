from .inspect import (  # noqa: F401
    count_exchanges,
    formatted_plan,
    has_cartesian,
    partition_filters,
    physical_plan,
    pushed_filters,
    scan_columns,
)
