from .expressions import (
    case_when_paid,
    iso_date_str,
    json_get,
    label_expr,
    net_revenue,
)

__all__ = [
    "case_when_paid",
    "iso_date_str",
    "json_get",
    "label_expr",
    "net_revenue",
]
