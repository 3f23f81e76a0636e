"""Full query plans: reference-parity analytics + TPC-H-style benchmarks."""
