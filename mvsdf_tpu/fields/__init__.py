from . import embedder, mlp, sdf, radiance
