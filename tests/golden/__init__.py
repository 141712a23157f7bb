"""End-to-end golden-parity oracle.

A straight-line NumPy transcription of all four reference nodes
(/root/reference/src/scanRegistration.cpp -> laserOdometry.cpp ->
laserMapping.cpp -> transformMaintenance.cpp), composed sequentially the
way the ROS graph runs them.  It exists solely to pin the composed TPU
pipeline (loam_tpu.pipeline) to the reference's behavior: the BASELINE.md
north star is trajectory ATE <= 5 cm vs the reference on real bags; with
no bags in this container, this oracle is the stand-in reference
implementation.

Everything here is test-only, sequential, and deliberately un-TPU-like —
fidelity over speed.
"""
