"""Engine error taxonomy — mirrors the reference's observable HTTP failures
(FastAPI HTTPException status codes in main.py) as typed exceptions."""

from __future__ import annotations


class FeatureStoreError(Exception):
    """Base class for engine errors."""


class NotFoundError(FeatureStoreError):
    """Missing registry row (reference: 404s at main.py:78-80, 129-133,
    158-161, 238-241, 312-316)."""


class ConflictError(FeatureStoreError):
    """Uniqueness violation (reference: 400s at main.py:47-52 raw-table name,
    main.py:163-172 (feature_id, version) pair)."""


class SchemaValidationError(FeatureStoreError):
    """Raw-data schema mismatch (reference: 400 at main.py:194-199, raised
    from compute.py:106-120)."""


class ComputationError(FeatureStoreError):
    """Feature computation failure (reference: 500 at main.py:202-206,
    raised from compute.py:41-58)."""
