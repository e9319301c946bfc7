"""CAHomo evaluation: point-matching error and scene-category reports."""

from dmhomo_tpu.evaluation.metrics import (
    point_matching_error,
    CATEGORY_NAMES,
    TEST_CATEGORIES,
    bucket_by_category,
    category_report,
)

__all__ = [
    "point_matching_error",
    "CATEGORY_NAMES",
    "TEST_CATEGORIES",
    "bucket_by_category",
    "category_report",
]
