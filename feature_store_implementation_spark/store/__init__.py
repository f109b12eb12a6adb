from .codec import decode_value_py, encode_value_col, decode_value_col
from .offline import OfflineStore

__all__ = ["OfflineStore", "encode_value_col", "decode_value_col", "decode_value_py"]
