from gotsdb_spark.storage.engine import (
    CollectionExistsError,
    CollectionNotFoundError,
    Engine,
    KeyNotFoundError,
)

__all__ = [
    "Engine",
    "CollectionNotFoundError",
    "CollectionExistsError",
    "KeyNotFoundError",
]
