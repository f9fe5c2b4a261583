"""Neural audio codec model families (shared acoustic tokenizers/vocoders).

Flat exports, parity with /root/reference/mlx_audio/codec/__init__.py:1-19.
"""

from .models.snac import SNAC

__all__ = ["SNAC"]


def __getattr__(name):
    # lazy heavy imports
    if name == "DAC":
        from .models.descript import DAC

        return DAC
    if name == "Encodec":
        from .models.encodec import Encodec

        return Encodec
    if name == "Mimi":
        from .models.mimi import Mimi

        return Mimi
    if name == "Vocos":
        from .models.vocos import Vocos

        return Vocos
    raise AttributeError(name)
