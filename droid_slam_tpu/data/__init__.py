"""Datasets: training readers (TartanAir), evaluation streams
(EuRoC/TUM/ETH3D), augmentation, covisibility graphs."""
