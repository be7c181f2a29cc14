# fixture_lego_sparse with the per-p-block windowed draw engine: the r5c
# NNLS attribution put most of the window engine's 43.1 ms/iter blend in
# wide (>=96) whole-traversal 2D classes (37-160 ms realized); per-block
# windows shrink the traversal drift B-fold (measured 0.16x of a full
# sweep vs 0.59x for whole-traversal classes,
# tools/analyze_blocked_windows.py).
_base_ = './fixture_lego_sparse.py'

expname = 'fixture_lego_blocked'

fine_train = {'bucket_blocked': True}
