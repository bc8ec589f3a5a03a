from tpu_sparse.bench.harness import (
    BenchmarkConfig,
    BenchmarkResult,
    export_csv,
    generate_markdown_report,
    run_all_benchmarks,
    run_single_benchmark,
)

__all__ = [
    "BenchmarkConfig", "BenchmarkResult", "export_csv",
    "generate_markdown_report", "run_all_benchmarks",
    "run_single_benchmark",
]
