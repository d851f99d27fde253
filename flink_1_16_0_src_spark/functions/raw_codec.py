"""RAW / StructuredType opaque-value codec (SURVEY.md §1.3 last row).

Reference parity:
- `RAW` type (`T-COMMON/types/logical/RawType.java`) — an arbitrary
  JVM object carried as opaque bytes with an attached serializer; Flink
  moves it through the pipeline without interpreting it.
- `StructuredType` (`T-COMMON/types/logical/StructuredType.java`) —
  user POJO types; fields ARE visible to the engine (maps to Spark
  `StructType` directly — no codec needed, covered by every struct
  query).
- `DistinctType` (`DistinctType.java`) — a named wrapper around a
  source type; on Spark it is just the source type plus discipline.

Spark mapping: RAW ≡ `BinaryType` column + Python-side pickle codec at
the boundaries. The engine treats the bytes as a black box (group,
join, shuffle on OTHER columns); only Python UDF stages that declared
the codec look inside — exactly Flink's contract that RAW values are
only usable where the matching TypeSerializer is present.

Scale: encode/decode run as Arrow-batched pandas UDFs (no per-row
Python round trips); the payload shuffles as plain binary, so all
Tungsten paths (sort, exchange, spill) apply unchanged.
"""

from __future__ import annotations

import pickle
from typing import Any, Callable, Union

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("binary")
def _pickle_encode(s: Union[pd.Series, pd.DataFrame]) -> pd.Series:
    # struct columns arrive as a pandas DataFrame (one column per field);
    # scalars/arrays arrive as a Series
    if isinstance(s, pd.DataFrame):
        return pd.Series([pickle.dumps(r) for r in s.to_dict("records")])
    return s.map(lambda v: None if v is None else pickle.dumps(v))


def raw_encode(col: Column | str) -> Column:
    """Value → RAW bytes (RawType.java serializer side). Accepts any
    Arrow-transferable column (struct arrives as dict, array as list)."""
    return _pickle_encode(F.col(col) if isinstance(col, str) else col)


def raw_decode(col: Column | str, apply: Callable[[Any], Any], result_type: str) -> Column:
    """RAW bytes → ``apply(obj)`` projected to ``result_type``. The
    caller supplies the deserializer-side function, mirroring Flink
    needing the RAW type's TypeSerializer to read the value."""

    @pandas_udf(result_type)
    def _dec(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else apply(pickle.loads(bytes(b))))

    return _dec(F.col(col) if isinstance(col, str) else col)
