"""Driver-side pure-Python reference implementations used ONLY to
generate oracle SQL (VALUES tables) for queries whose Spark-side
hashing (xxhash64) no other SQL engine reproduces. Nothing in this
package runs on executors or touches Spark."""
