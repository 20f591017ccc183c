"""Model families and NN transforms."""
