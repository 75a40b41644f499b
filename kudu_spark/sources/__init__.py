from kudu_spark.sources.backup import backup, prune_backups, restore
from kudu_spark.sources.bulk import (
    avro_schema,
    copy_table,
    export_avro_schema,
    export_csv,
    export_parquet,
    import_csv,
)

__all__ = [
    "avro_schema",
    "backup",
    "copy_table",
    "export_avro_schema",
    "export_csv",
    "export_parquet",
    "import_csv",
    "prune_backups",
    "restore",
]
