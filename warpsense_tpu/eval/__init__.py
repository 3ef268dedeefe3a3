"""Evaluation harnesses — the executable integration/eval drivers the
reference ships as ROS nodes (/root/reference/test/pcd2tsdf.cpp,
/root/reference/test/pcd_registration.cpp) plus pipeline-level ATE/Hz
evals the reference performs externally with evo."""
