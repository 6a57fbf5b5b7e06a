"""Pure, deterministic, seed-driven kernels.

No Ray imports here — everything is plain numpy / hashlib / re so the
kernels are unit-testable without a cluster and identical on any worker.
"""
