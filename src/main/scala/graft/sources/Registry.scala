package graft.sources

/** Metadata-driven control plane: table → primary key, mirroring the
  * reference's registry (/root/reference/databricks_notebooks/
  * 2_Bronze_to_Silver.py:16-32) and the ADF control table
  * (adf/pipeline.json:63-87; README.MD:51-62). Tables with `active = false`
  * are skipped by the pipeline loop (the README's IsActive=1 filter,
  * README.MD:55). */
/** `typeOverrides` (column → DDL type, e.g. `"Price" -> "decimal(12,2)"`)
  * pins source-declared types that CSV inference degrades — see
  * [[LandingSource.readInferred]]. */
final case class TableConfig(name: String, pk: String, active: Boolean = true,
                             typeOverrides: Map[String, String] = Map.empty)

object Registry {

  /** The reference's 15 source tables (setup_database.sql:13-198). */
  val referenceTables: Seq[TableConfig] = Seq(
    TableConfig("Sellers", "SellerID"),
    TableConfig("Customers", "CustomerID"),
    TableConfig("ProductCategories", "CategoryID"),
    TableConfig("Products", "ProductID"),
    TableConfig("OrderStatus", "StatusID"),
    TableConfig("Orders", "OrderID"),
    TableConfig("Reasons", "ReasonID"),
    TableConfig("OrderItems", "OrderItemID"),
    TableConfig("ShoppingCarts", "CartID"),
    TableConfig("CartItems", "CartItemID"),
    TableConfig("PaymentMethods", "PaymentMethodID"),
    TableConfig("Payments", "PaymentID"),
    TableConfig("Reviews", "ReviewID"),
    TableConfig("Addresses", "AddressID"),
    TableConfig("Inventory", "InventoryID"))

  def apply(configs: Seq[TableConfig]): Map[String, TableConfig] =
    configs.map(c => c.name -> c).toMap
}
