from .catalog import Catalog, FeatureRow, RawTableRow, VersionRow
from .schema_validation import validate_raw_data_schema

__all__ = [
    "Catalog",
    "RawTableRow",
    "FeatureRow",
    "VersionRow",
    "validate_raw_data_schema",
]
