from .vector import cosine_col, dot_col, l2_norm_col
from .textfns import tokens_col, word_ngrams_col

__all__ = ["cosine_col", "dot_col", "l2_norm_col", "tokens_col", "word_ngrams_col"]
