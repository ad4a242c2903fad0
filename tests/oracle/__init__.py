# Scalar NumPy oracle of the reference tracker (test-only; see reference_oracle.py).
