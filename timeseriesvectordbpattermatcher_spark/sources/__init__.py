from .synth import synth_seqs  # noqa: F401
from .tables import load_table  # noqa: F401
