"""Generalized (multi-document) index — first-class version of the
reference README's NUL-concatenation scheme."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from suffix_tpu import MultiDocIndex

idx = MultiDocIndex(["the quick fox", "a lazy dog", "quick quick"])
print("'quick' occurs at (doc, offset):", sorted(idx.positions("quick")))
print("docs containing 'quick':", idx.docs_containing("quick"))
