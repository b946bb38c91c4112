from .checkpoint import save_checkpoint, load_checkpoint
from .timers import PhaseTimers

__all__ = ["save_checkpoint", "load_checkpoint", "PhaseTimers"]
