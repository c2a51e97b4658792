from vfmseg_tpu.utils.misc import add_prefix, flatten_tree_paths, path_matches

__all__ = ["add_prefix", "flatten_tree_paths", "path_matches"]
