"""Cross-engine-stable rounding for decimal-quantized (money/quantity) data.

Spark's ``round`` on doubles applies HALF_UP to the *shortest decimal
representation* of the value (Scala BigDecimal.decimal), while DuckDB rounds
the *binary* double. Prices and quantities are decimal quanta, so derived
expressions (x*1.1, price*(1-disc)) land exactly on .xx5 tie boundaries where
the two semantics diverge (e.g. 311582.535 -> .54 on Spark, .53 on DuckDB).

Adding a fixed epsilon inside the round -- in BOTH the Spark query and the
DuckDB oracle -- pushes every exact tie strictly above the boundary, making
the engines agree. 1.37e-6 is (a) far above double noise at money magnitudes,
(b) not itself a decimal quantum, so it cannot manufacture a *new* exact tie
from 2-6dp-exact data.

Use only for decimal-quantized data. Full-precision floats (embeddings,
cosines) never hit exact decimal ties; round them plainly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1.37e-6
SQL_EPS = "1.37e-6"


def mround(col: Column | str, scale: int) -> Column:
    if isinstance(col, str):
        col = F.col(col)
    return F.round(col + F.lit(EPS), scale)
