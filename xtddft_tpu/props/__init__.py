from xtddft_tpu.props import oscillator, spin

__all__ = ["oscillator", "spin"]
