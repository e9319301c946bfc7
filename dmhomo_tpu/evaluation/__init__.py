"""CAHomo evaluation: point-matching error and scene-category reports."""

from dmhomo_tpu.evaluation.metrics import (
    point_matching_error,
    CATEGORY_NAMES,
    TEST_CATEGORIES,
    bucket_by_category,
    bucket_sums,
    category_report,
    merge_bucket_sums,
    point_error_under_h,
    point_error_under_h_v2,
)

__all__ = [
    "point_matching_error",
    "point_error_under_h",
    "point_error_under_h_v2",
    "CATEGORY_NAMES",
    "TEST_CATEGORIES",
    "bucket_by_category",
    "bucket_sums",
    "category_report",
    "merge_bucket_sums",
]
