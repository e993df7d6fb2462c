from hbase_bulkload_spark.functions.keys import (  # noqa: F401
    composite_rowkey,
    hex_bucket,
    md5_hex,
    mod_bucket,
    reverse_key,
    salted_key,
)
