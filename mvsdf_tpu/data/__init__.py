from . import formats
from .scene import SceneData
