from .registry import Registry
from .vocab import Vocabulary, build_vocab, clean_str
from .text2vec import Bow2Vec, AveWord2Vec, get_text_encoder
