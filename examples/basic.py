"""Basic usage — the reference's examples/basic.rs as Python."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from suffix_tpu import SuffixTable

st = SuffixTable.new("the quick brown fox was quick.")
assert st.positions("quick").tolist() == [4, 24]
print("positions of 'quick':", st.positions("quick").tolist())
