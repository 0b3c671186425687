"""Pure-pandas oracles for the golden-pinned contract queries.

These implement the CITED REFERENCE SEMANTICS (file:line in each docstring)
with pandas/numpy only — no imports from the engine's operator modules — so
the committed golden fixtures are regenerated from an implementation that is
independent of the Spark engine under test (VERDICT r2 item 1). Scalar
recursions (EMA/ATR/PSAR folds) follow the documented numeric spec
(left fold ``acc = acc + alpha*(x - acc)`` seeded with the first
observation, operators/indicators.py module docstring) so IEEE-754
determinism makes byte-equality achievable across the two implementations.
"""

from decimal import ROUND_HALF_UP, Decimal


def round_half_up(x: float, digits: int = 6) -> float:
    """Spark-compatible rounding: F.round(double, d) feeds the double's
    SHORTEST decimal representation into BigDecimal.setScale(d, HALF_UP)
    (scala BigDecimal(double) = valueOf = Double.toString). Python's
    built-in round() is HALF_EVEN and diverges on exact decimal ties
    (any double that is an odd multiple of 2^-k can land on one), so
    oracles must round THIS way when pinning engine output."""
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))
