"""Round-4 prototype: in-kernel mini expansion via 8-bank lane gathers
+ select + transpose. MEASURED DEAD END (6.1 ms vs 0.7 ms write floor vs
2.88 ms XLA gather) — kept for provenance; see r4_fusion_split.md."""
# (measurement body preserved in the session log; key result above)
