from .explain_check import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filter,
    assert_read_schema_only,
    physical_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filter",
    "assert_read_schema_only",
    "physical_plan",
]
