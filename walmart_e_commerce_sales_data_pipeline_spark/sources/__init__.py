from .readers import read_csv, read_parquet, read_json, read_orc, read_jdbc, load_testdata  # noqa: F401
from .writers import write_csv_single, write_parquet, write_orc, write_jdbc  # noqa: F401
