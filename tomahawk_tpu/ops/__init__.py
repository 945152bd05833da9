from .hwe import hwe_exact
from .fisher import fisher_exact_two_sided
