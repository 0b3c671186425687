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
