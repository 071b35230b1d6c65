from versatiles_rs_spark.plans.vpl import build_pipeline, parse_vpl  # noqa: F401
