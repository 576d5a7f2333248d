from .carving import carving
from .losses import total_loss, LossTerms
