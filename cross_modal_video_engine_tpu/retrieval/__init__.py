from .index import RetrievalIndex
from .evaluation import encode_batched, norm_score
