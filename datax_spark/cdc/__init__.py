from datax_spark.cdc.apply import CdcApplier  # noqa: F401
