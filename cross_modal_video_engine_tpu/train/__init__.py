from .checkpoint import save_checkpoint, load_checkpoint, best_checkpoint_manager
from .orbax_ckpt import ShardedCheckpointer
