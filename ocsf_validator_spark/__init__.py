"""ocsf_validator_spark — a PySpark-native constraint-validation engine.

A ground-up re-expression of the *semantics* of ocsf/ocsf-validator
(reference at /root/reference, v0.2.4) as declarative column constraints
compiled to vectorized DataFrame expressions, evaluated at cluster scale
over tables of multi-turn agent transcripts:

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

Reference semantics covered (see SURVEY.md §2 for the full inventory):

- required keys            (reference validators.py:59-103)   -> NotNull
- unknown keys             (reference validators.py:106-158)  -> AllowedColumns
- undefined attributes     (reference validators.py:201-233)  -> InEnum (referential)
- unused dictionary attrs  (reference validators.py:169-198)  -> EnumCoverage
- name collisions          (reference validators.py:236-262)  -> Unique
- attribute type checks    (reference validators.py:317-374)  -> TypeCast
- metaschema conformance   (reference validators.py:265-314)  -> Regex/MaxLen/Range
- deprecation              (reference types.py:27-29,80)      -> Deprecated
- include/extends/profiles (reference processor.py:195-498)   -> suite inheritance
- severity config + runner (reference runner.py:31-385)       -> Severity/run_validation

Engine additions required by the north rule: single-pass bucketed column
stats, per-partition pass/fail verdicts, KS/PSI drift, checkpoint/resume,
and large-scale pipeline ops (dedup, similarity search, text analysis).
"""

from ocsf_validator_spark.spec import (  # noqa: F401
    AllowedColumns,
    Constraint,
    ConstraintSet,
    Deprecated,
    EnumCoverage,
    InEnum,
    MaxLen,
    Monotonic,
    NotNull,
    Range,
    Regex,
    Severity,
    TurnOrdering,
    TypeCast,
    Unique,
)

__version__ = "0.1.0"
