from .io import (
    read_json_table,
    read_plans,
    read_star_table,
    read_user_subscriptions,
    write_json_table,
)

__all__ = [
    "read_json_table",
    "read_plans",
    "read_star_table",
    "read_user_subscriptions",
    "write_json_table",
]
