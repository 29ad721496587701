from xtddft_tpu.response.reference_state import Reference, make_reference

__all__ = ["Reference", "make_reference"]
