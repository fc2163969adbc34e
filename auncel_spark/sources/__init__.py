from auncel_spark.sources.fvecs import (
    read_fbin,
    read_fvecs,
    read_ivecs,
    write_fvecs,
    write_ivecs,
)

__all__ = ["read_fbin", "read_fvecs", "read_ivecs", "write_fvecs", "write_ivecs"]
