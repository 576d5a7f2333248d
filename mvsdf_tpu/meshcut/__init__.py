from .cut import mesh_cut, trim_mesh, face_adjacency_edges
