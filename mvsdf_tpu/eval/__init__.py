from .marching import marching_tetrahedra, extract_mesh
from .mesh import biggest_component, save_obj, load_obj, face_areas
from .psnr import masked_psnr
