"""PySpark-native schema + constraint validation engine.

A brand-new, Spark-first re-expression of the quality-check contracts of
``DAndrewA/sat-val-framework`` (reference at /root/reference, read-only):

- eager QC on scan (reference ``implement.py:100-104``)  -> fused scan+assert+agg jobs
- errors-as-values (``implement.py:23-56``)              -> verdict/violation rows
- whole-event rejection (``implement.py:185-187``)       -> doc-level gating
- typed suite config (``implement.py:147-162``)          -> schema-validated CheckSuite
- checkpointed event list (``usable.py:51-62``)          -> parquet metrics table + left-anti resume

Everything here is DataFrame/Column-expression based; the only Python that
touches data is vectorized (Arrow) ``applyInPandas`` in the drift operators.
"""

from sat_val_framework_spark.session import get_spark
from sat_val_framework_spark.suite import Check, CheckSuite, SuiteConfigError
from sat_val_framework_spark.verdicts import VERDICT_SCHEMA

__all__ = [
    "get_spark",
    "Check",
    "CheckSuite",
    "SuiteConfigError",
    "VERDICT_SCHEMA",
]
