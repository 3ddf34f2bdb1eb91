from suffix_tpu.tree.stree import SuffixTree, Node
from suffix_tpu.tree.dot import to_dot

__all__ = ["SuffixTree", "Node", "to_dot"]
