"""Basic usage — the reference's examples/basic.rs as Python."""
from suffix_tpu import SuffixTable

st = SuffixTable.new("the quick brown fox was quick.")
assert st.positions("quick").tolist() == [4, 24]
print("positions of 'quick':", st.positions("quick").tolist())
