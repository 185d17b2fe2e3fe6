"""Sources: testdata loaders, raw-MRF extractors, registry dimension."""

from clearcare_data_pipeline_spark.sources.tables import load_table, register_views  # noqa: F401
