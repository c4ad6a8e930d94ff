package graft.sql

/** Test fixtures re-expressing the reference's behavioural-suite shapes
  * (reference: Pizza.scala:3-5, Person.scala:3-9; see FIXTURES.md).
  */
case class Ingredient(name: String, sugar: Double, fat: Double)
case class Pizza(name: String, ingredients: Seq[Ingredient],
                 vegetarian: Boolean, vegan: Boolean, calories: Int)

case class Street(name: String)
case class Address(street: Street, street2: Option[Street], city: String,
                   state: String, zip: String, country: String)
case class Person(name: String, address: Address)

case class SimpleAddress(street: String, city: String, state: String,
                         zip: String, country: String)

case class Inner(n: Int)
case class Outer(id: Int, inner: Option[Inner])

case class TagVal(a: Int, b: String)
case class MapHolder(id: Int, tags: Map[String, TagVal])

object Fixtures {
  val pepperoni: Pizza = Pizza("pepperoni",
    Seq(Ingredient("pepperoni", 12, 4.4), Ingredient("onions", 1, 0.4)),
    vegetarian = false, vegan = false, calories = 98)

  val rick: Person =
    Person("Rick", Address(Street("Rock St"), None, "MtV", "CA", "94041", "USA"))

  val rick2: Person =
    Person("Rick", Address(Street("Rock St"), Some(Street("412 East")), "MtV",
      "CA", "94041", "USA"))

  val simpleAddress: SimpleAddress =
    SimpleAddress("Rock St", "MtV", "CA", "94041", "USA")
}
