from .load_data import load_data, load_everything, inward_nearfar_heuristic
