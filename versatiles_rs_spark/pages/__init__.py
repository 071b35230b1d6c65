from versatiles_rs_spark.pages.extract import with_extracted_text  # noqa: F401
from versatiles_rs_spark.pages.generator import synth_pages  # noqa: F401
