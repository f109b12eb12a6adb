"""The computation surface: what replaces the reference's ``exec`` sandbox.

The reference binds ``{pd, df, raw_data}`` and ``exec``s arbitrary Python
that must assign ``result`` = per-entity Series (compute.py:30-55). That is
unsafe (the ``{"__builtins__": {}}`` sandbox is escapable, SURVEY §1.5) and
opaque to any optimizer. Our ``computation_logic`` is a *declared* surface
with five forms, in decreasing Catalyst visibility:

1. **Aggregate SQL expression** — e.g. ``"SUM(amount)"`` or
   ``"COUNT(DISTINCT item) + 1"``: evaluated as
   ``df.groupBy(entity).agg(expr(...))``. Fully optimized (partial
   aggregation, codegen, pushdown).
2. **Row SQL expression** — prefix ``row:`` e.g. ``"row: amount * 2"``:
   one value per input row; the entity column must be unique per row.
3. **Registered transform** — prefix ``transform:<name>``: a Python
   ``fn(DataFrame, entity_col) -> DataFrame(entity_id, value)`` registered
   via :func:`register_transform` — the honest replacement for arbitrary
   pandas programs, still whole-DataFrame (use built-in ops inside;
   ``applyInPandas`` only when semantics require).
4. **Reference-parity pandas program** — prefix ``pandas:``: the
   reference's exact ``exec`` contract (compute.py:30-55: globals
   ``{pd, df, raw_data}``, assign ``result`` = entity-indexed Series or
   1-column frame) run against the collected DataFrame. Bounded by
   ``PANDAS_EXEC_MAX_ROWS`` — it is the compatibility shim for programs
   written against the reference, NOT the scale path, and shares the
   reference's caveat that ``{"__builtins__": {}}`` is not a real
   security boundary (SURVEY §1.5).
5. **Distributed pandas program** — prefix ``pandas_by_entity:``: the
   same exec contract applied per entity group via Arrow-batched
   ``applyInPandas`` (``df`` = that entity's rows; ``result`` must reduce
   to one NUMERIC value — the output is typed ``value double``, so
   integers narrow to double and non-numeric results raise; use form 4
   for dtype-preserving non-numeric results). Scales to any corpus
   because no group ever leaves the executors.

Migration fallback (OPT-IN): an UNPREFIXED string that fails SQL analysis
but assigns ``result`` can be treated as form 4, so payloads written for
the upstream service run unmodified — but only when explicitly enabled
(``allow_unprefixed_programs=True`` per call, or the module-level
``UNPREFIXED_PROGRAM_FALLBACK`` switch). Off by default: silently routing
failed SQL into driver-side ``exec`` would turn the declared-SQL surface
into arbitrary Python execution and mask the real analysis error (e.g. a
typo'd aggregate over a column literally named ``result``).

All forms return a two-column DataFrame ``(entity_id: string, value: <typed>)``
— the Spark equivalent of the reference's entity-indexed Series
(compute.py:46-55)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import ComputationError

TRANSFORMS: dict[str, Callable[[DataFrame, str], DataFrame]] = {}

# Row cap for the driver-side ``pandas:`` compatibility form. Programs over
# larger inputs must use the aggregate/row/transform/pandas_by_entity forms.
PANDAS_EXEC_MAX_ROWS = 2_000_000

# Migration switch: when True, an unprefixed computation_logic that fails SQL
# analysis but assigns ``result`` falls back to the reference exec contract.
# Off by default — see the module docstring.
UNPREFIXED_PROGRAM_FALLBACK = False


def _exec_pandas_program(pdf, program: str, allow_scalar: bool = False):
    """Run a reference-contract pandas program (compute.py:30-55): exec with
    ``{pd, df, raw_data}`` bound and no builtins, read back ``result`` as an
    entity-indexed Series (1-column frames squeeze; anything else raises).
    ``allow_scalar`` (the per-entity form) additionally accepts a bare
    numeric — the natural output of a per-group reduction."""
    import numbers

    import pandas as pd

    env = {"pd": pd, "df": pdf, "raw_data": pdf}
    exec(program, {"__builtins__": {}}, env)  # noqa: S102 — reference parity
    if "result" not in env:
        raise ComputationError(
            "Computation logic must assign result to 'result' variable"
        )
    result = env["result"]
    if isinstance(result, pd.DataFrame):
        if len(result.columns) == 1:
            result = result.iloc[:, 0]
        else:
            raise ComputationError("Computation must return a single column")
    if allow_scalar and isinstance(result, numbers.Number):
        result = pd.Series([result])
    if not isinstance(result, pd.Series):
        raise ComputationError(
            "Computation must return a pandas Series or DataFrame"
        )
    return result


def _reference_program(df: DataFrame, program: str) -> DataFrame:
    """Driver-side reference-contract execution (the ``pandas:`` form and
    the opt-in unprefixed-program fallback): bounded collect, exec, Series
    back to a (entity_id, value) DataFrame. One materialization only —
    ``limit(cap + 1)`` both enforces the cap and is the collect."""
    pdf = df.limit(PANDAS_EXEC_MAX_ROWS + 1).toPandas()
    if len(pdf) > PANDAS_EXEC_MAX_ROWS:
        raise ComputationError(
            f"pandas programs are capped at {PANDAS_EXEC_MAX_ROWS} rows — "
            "use the aggregate/transform/pandas_by_entity forms at scale"
        )
    series = _exec_pandas_program(pdf, program)
    out = series.rename_axis("entity_id").reset_index(name="value")
    if len(out) == 0:
        # createDataFrame cannot infer a schema from an empty frame; the
        # value type is unknowable here, so default the empty result to the
        # numeric contract used by pandas_by_entity
        return df.sparkSession.createDataFrame([], "entity_id string, value double")
    return df.sparkSession.createDataFrame(out).select(
        F.col("entity_id").cast("string"), "value"
    )


def register_transform(name: str):
    """Register a named whole-DataFrame transform usable as
    ``computation_logic = "transform:<name>"``."""

    def deco(fn: Callable[[DataFrame, str], DataFrame]):
        TRANSFORMS[name] = fn
        return fn

    return deco


def _entity_col(df: DataFrame, entity_id_column: str) -> Column:
    if entity_id_column not in df.columns:
        # reference: 400 "Column 'X' not found in data" (main.py:178-188)
        raise ComputationError(
            f"Entity ID column '{entity_id_column}' not found in data"
        )
    return F.col(entity_id_column).cast("string")


def compute_feature(
    df: DataFrame,
    computation_logic: str,
    entity_id_column: str = "id",
    allow_unprefixed_programs: bool | None = None,
) -> DataFrame:
    """Evaluate ``computation_logic`` against ``df`` → (entity_id, value).

    Mirrors compute.py:9-58's contract: exactly one value column, keyed by
    entity; anything else raises :class:`ComputationError`.

    ``allow_unprefixed_programs`` enables the migration fallback (unprefixed
    reference pandas programs); ``None`` defers to the module-level
    ``UNPREFIXED_PROGRAM_FALLBACK`` switch (default off)."""
    logic = computation_logic.strip()
    entity = _entity_col(df, entity_id_column)
    try:
        if logic.startswith("transform:"):
            name = logic[len("transform:") :].strip()
            if name not in TRANSFORMS:
                raise ComputationError(f"Unknown transform '{name}'")
            out = TRANSFORMS[name](df, entity_id_column)
            if set(out.columns) != {"entity_id", "value"}:
                raise ComputationError(
                    "Transform must return columns (entity_id, value), got "
                    f"{out.columns}"  # compute.py:49-53 multi-col rejection
                )
            return out.select(F.col("entity_id").cast("string"), "value")
        if logic.startswith("pandas:"):
            return _reference_program(df, logic[len("pandas:") :])
        if logic.startswith("pandas_by_entity:"):
            import pandas as pd

            program = logic[len("pandas_by_entity:") :]
            ent_name = entity_id_column

            def per_group(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
                series = _exec_pandas_program(pdf, program, allow_scalar=True)
                if len(series) != 1:
                    raise ComputationError(
                        "pandas_by_entity: program must reduce each entity "
                        f"group to one value, got {len(series)}"
                    )
                # the distributed form's contract is (entity_id string,
                # value double): results must be numeric and integers
                # narrow to double — non-numeric results (strings, bools,
                # timestamps) need the driver-side 'pandas:' form, which
                # preserves the result dtype
                raw = series.iloc[0]
                try:
                    val = float(raw)
                except (TypeError, ValueError) as e:
                    raise ComputationError(
                        "pandas_by_entity: contract is (entity_id string, "
                        f"value double) but the program produced a "
                        f"non-numeric {type(raw).__name__} ({raw!r}); use "
                        "the 'pandas:' form for non-numeric results"
                    ) from e
                # key off applyInPandas's GROUPING KEY (the string-casted
                # entity expression), not the raw entity column in pdf:
                # the raw value may be array-typed (a scalar-NULL probe
                # would crash on it) or a float whose NaN is a DISTINCT
                # group from NULL under cast('string') — the key tuple
                # carries exactly what the aggregate form emits, so the
                # two forms agree on every input
                ekey = key[0]
                return pd.DataFrame(
                    {
                        # NULL entity stays NULL — str(None) would mint a
                        # phantom entity keyed 'None' that the aggregate
                        # and row forms know nothing about
                        "entity_id": [None if ekey is None else str(ekey)],
                        "value": [val],
                    }
                )

            return df.groupBy(entity.alias("_e")).applyInPandas(
                lambda key, pdf: per_group(key, pdf),
                "entity_id string, value double",
            )
        if logic.startswith("row:"):
            expr = logic[len("row:") :].strip()
            out = df.select(entity.alias("entity_id"), F.expr(expr).alias("value"))
            # force analysis eagerly like the aggregate branch below: a
            # typo'd column would otherwise surface as a raw
            # AnalysisException at the caller's first schema touch,
            # outside this function's ComputationError contract
            out.schema
            return out
        # default: aggregate expression per entity; if the string isn't SQL
        # but looks like a reference pandas program (assigns `result`) AND
        # the migration fallback is enabled, fall back to the reference
        # exec contract so payloads written for the upstream service run
        # unmodified
        try:
            out = df.groupBy(entity.alias("entity_id")).agg(
                F.expr(logic).alias("value")
            )
            out.schema  # force parse/analysis eagerly (lazy in Spark 4)
            return out
        except Exception as sql_err:
            import re as _re

            if not _re.search(r"\bresult\s*=", logic):
                raise
            enabled = (
                UNPREFIXED_PROGRAM_FALLBACK
                if allow_unprefixed_programs is None
                else allow_unprefixed_programs
            )
            if not enabled:
                raise ComputationError(
                    f"Computation failed: {sql_err}. The logic is not valid "
                    "SQL but assigns 'result' like a reference pandas "
                    "program — use the explicit 'pandas:' prefix, or enable "
                    "the migration fallback (allow_unprefixed_programs=True)"
                ) from sql_err
            try:
                return _reference_program(df, logic)
            except ComputationError:
                raise
            except Exception as exec_err:
                # surface BOTH causes: the program path failed and the
                # original SQL analysis error stays chained so a typo'd
                # aggregate over a column named 'result' is diagnosable
                raise ComputationError(
                    f"Computation failed as SQL ({sql_err}) and as an "
                    f"unprefixed pandas program ({exec_err})"
                ) from sql_err
    except ComputationError:
        raise
    except Exception as e:  # analysis errors → ComputationError (main.py:202-206)
        raise ComputationError(f"Computation failed: {e}") from e


def ewm_features(
    df,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float,
):
    """Per-entity exponentially-weighted mean (pandas ``.ewm(alpha).mean()``
    semantics, adjust=True) — the recursive time-series smoother the
    reference's sandbox gets from pandas and plain SQL windows cannot
    express exactly. Arrow-batched ``applyInPandas`` per entity: the group
    is sorted by ``order_cols`` (deterministic tie-break required) and
    smoothed with pandas itself, so semantics are pandas-exact by
    construction. State is O(1) per row; groups stream through Python at
    Arrow speed — the right trade for a genuinely sequential recurrence."""
    import pandas as pd

    from pyspark.sql import functions as F  # noqa: F401 (kept for symmetry)

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(key_col, *order_cols, value_col).schema.fields
    ) + ", ewm double"

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        pdf["ewm"] = pdf[value_col].ewm(alpha=alpha, adjust=True).mean().round(6)
        return pdf

    return (
        df.select(key_col, *order_cols, value_col)
        .groupBy(key_col)
        .applyInPandas(smooth, schema=out_schema)
    )


def rewrap_executor_computation_error(exc: Exception) -> Exception:
    """Recover the ComputationError contract for EXECUTOR-raised failures:
    ``pandas_by_entity`` programs run per group inside applyInPandas, so
    their errors surface at ACTION time as a pyspark PythonException —
    after compute_feature has returned, past its try/except, and invisible
    to the HTTP layer's ComputationError → 500 mapping (every other form
    wraps failures eagerly inside compute_feature; a distributed form
    cannot). Callers that trigger the action (FeatureStore.compute_version)
    pass the caught exception through here: a PythonException — the
    Python-worker failure type, i.e. the USER PROGRAM failed, matching
    compute_feature's catch-all for the driver-side forms — is re-raised
    under the contract type carrying the original ComputationError message
    when the traceback names one, else its last traceback line (the
    KeyError/TypeError the program actually hit). Non-worker failures
    (JVM/infra errors) return unchanged: mislabeling a disk failure as a
    computation error would hide an operational problem behind a 500
    detail string."""
    import re

    try:
        from pyspark.errors.exceptions.captured import PythonException
    except ImportError:  # pragma: no cover — pyspark always provides it
        PythonException = ()  # type: ignore[assignment]

    text = str(exc)
    m = re.search(r"ComputationError: ([^\n]+)", text)
    if m:
        return ComputationError(m.group(1).strip())
    if isinstance(exc, PythonException):
        lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
        tail = next(
            (ln for ln in reversed(lines) if re.match(r"\w+(Error|Exception):", ln)),
            lines[-1] if lines else text,
        )
        return ComputationError(f"Computation failed: {tail}")
    return exc
