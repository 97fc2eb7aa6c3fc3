from polardecoding_tpu.models.bp import bp_decode, bpr_decode
from polardecoding_tpu.models.sc import sc_decode
from polardecoding_tpu.models.scl import cascl_decode, cascl_select, scl_decode

__all__ = [
    "bp_decode",
    "bpr_decode",
    "sc_decode",
    "scl_decode",
    "cascl_decode",
    "cascl_select",
]
