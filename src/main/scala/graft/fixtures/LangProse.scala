package graft.fixtures

/** Natural-prose corpus for the langid oracle (replaces the LangMark
  * marker-weaving layer): a small committed pool of public-domain
  * sentences — famous openings and passages of out-of-copyright classics —
  * so the [[graft.textops.LangId]] kernel is scored on realistic prose with
  * genuine cross-language ambiguity (shared Romance function words,
  * German/English homographs), not on synthetically planted markers.
  *
  * Sources, all public domain: Austen, Dickens, Melville, Brontë, Carroll,
  * Twain, Crane, Fitzgerald (en); Proust, Dumas, Flaubert, Voltaire, Verne,
  * Hugo, Rimbaud, Maupassant (fr); Cervantes, Espronceda, Alas «Clarín»,
  * Bécquer, Machado, Galdós (es); Kafka, Goethe, Büchner, Fontane,
  * Nietzsche (de); the Analects, Daodejing, Shijing, Qianziwen, Sanzijing,
  * Zhuangzi, the Great Learning (zh).
  *
  * A document draws a deterministic window of 3 consecutive pool sentences
  * keyed by doc_id (wrapping), so the 500-doc oracle corpus varies per
  * document while staying bit-reproducible.
  */
object LangProse {

  val pool: Map[String, IndexedSeq[String]] = Map(
    "en" -> Vector(
      "It is a truth universally acknowledged, that a single man in possession of a good fortune, must be in want of a wife.",
      "It was the best of times, it was the worst of times, it was the age of wisdom, it was the age of foolishness.",
      "Call me Ishmael. Some years ago, never mind how long precisely, having little or no money in my purse, I thought I would sail about a little and see the watery part of the world.",
      "There was no possibility of taking a walk that day.",
      "Alice was beginning to get very tired of sitting by her sister on the bank, and of having nothing to do.",
      "You don't know about me without you have read a book by the name of The Adventures of Tom Sawyer; but that ain't no matter.",
      "The cold passed reluctantly from the earth, and the retiring fogs revealed an army stretched out on the hills, resting.",
      "In my younger and more vulnerable years my father gave me some advice that I have been turning over in my mind ever since."),
    "fr" -> Vector(
      "Longtemps, je me suis couché de bonne heure.",
      "Le premier lundi du mois d'avril, le bourg de Meung semblait être dans une révolution aussi entière que si les huguenots en fussent venus y faire une seconde Rochelle.",
      "Nous étions à l'étude, quand le proviseur entra, suivi d'un nouveau habillé en bourgeois et d'un garçon de classe qui portait un grand pupitre.",
      "Il y avait en Vestphalie, dans le château de monsieur le baron de Thunder-ten-tronckh, un jeune garçon à qui la nature avait donné les mœurs les plus douces.",
      "L'année 1866 fut marquée par un événement bizarre, un phénomène inexpliqué et inexplicable que personne n'a sans doute oublié.",
      "En 1815, M. Charles-François-Bienvenu Myriel était évêque de Digne. C'était un vieillard d'environ soixante-quinze ans, qui occupait le siège de Digne depuis 1806.",
      "On n'est pas sérieux, quand on a dix-sept ans, et qu'on a des tilleuls verts sur la promenade.",
      "Quand la caissière lui eut rendu la monnaie de sa pièce de cent sous, Georges Duroy sortit du restaurant."),
    "es" -> Vector(
      "En un lugar de la Mancha, de cuyo nombre no quiero acordarme, no ha mucho tiempo que vivía un hidalgo de los de lanza en astillero, adarga antigua, rocín flaco y galgo corredor.",
      "Con diez cañones por banda, viento en popa, a toda vela, no corta el mar, sino vuela, un velero bergantín.",
      "La heroica ciudad dormía la siesta, y el viento sur, caliente y perezoso, empujaba las nubes blanquecinas.",
      "Volverán las oscuras golondrinas en tu balcón sus nidos a colgar, y otra vez con el ala a sus cristales jugando llamarán.",
      "Yo voy soñando caminos de la tarde. Las colinas doradas, los verdes pinos, las polvorientas encinas.",
      "Cuando el tren mixto descendente número 65 se detuvo en la pequeña estación situada entre los kilómetros 171 y 172, casi todos los viajeros de segunda y tercera clase se quedaron dormidos.",
      "En esto, descubrieron treinta o cuarenta molinos de viento que hay en aquel campo, y así como don Quijote los vio, dijo a su escudero: la ventura va guiando nuestras cosas mejor de lo que acertáramos a desear.",
      "Del salón en el ángulo oscuro, de su dueño tal vez olvidada, silenciosa y cubierta de polvo, veíase el arpa."),
    "de" -> Vector(
      "Als Gregor Samsa eines Morgens aus unruhigen Träumen erwachte, fand er sich in seinem Bett zu einem ungeheueren Ungeziefer verwandelt.",
      "Jemand musste Josef K. verleumdet haben, denn ohne dass er etwas Böses getan hätte, wurde er eines Morgens verhaftet.",
      "Wer reitet so spät durch Nacht und Wind? Es ist der Vater mit seinem Kind.",
      "Ich bin ein Teil von jener Kraft, die stets das Böse will und stets das Gute schafft.",
      "Den 20. Jänner ging Lenz durchs Gebirg. Die Gipfel und hohen Bergflächen im Schnee, die Täler grauer Stein.",
      "In Front des schon seit Kurfürst Georg Wilhelm von der Familie von Briest bewohnten Herrenhauses zu Hohen-Cremmen fiel heller Sonnenschein auf die mittagsstille Dorfstraße.",
      "Als Zarathustra dreißig Jahre alt war, verließ er seine Heimat und den See seiner Heimat und ging in das Gebirge.",
      "Es war ein König in Thule, gar treu bis an das Grab, dem sterbend seine Buhle einen goldnen Becher gab."),
    "zh" -> Vector(
      "子曰：学而时习之，不亦说乎？有朋自远方来，不亦乐乎？人不知而不愠，不亦君子乎？",
      "道可道，非常道。名可名，非常名。无名天地之始，有名万物之母。",
      "关关雎鸠，在河之洲。窈窕淑女，君子好逑。参差荇菜，左右流之。",
      "天地玄黄，宇宙洪荒。日月盈昃，辰宿列张。寒来暑往，秋收冬藏。",
      "人之初，性本善。性相近，习相远。苟不教，性乃迁。教之道，贵以专。",
      "北冥有鱼，其名为鲲。鲲之大，不知其几千里也。化而为鸟，其名为鹏。",
      "大学之道，在明明德，在亲民，在止于至善。知止而后有定，定而后能静。",
      "千里之行，始于足下。合抱之木，生于毫末。九层之台，起于累土。"))

  /** Deterministic 3-sentence window starting at doc_id % poolSize. */
  def sample(lang: String, docId: Long, n: Int = 3): String = {
    val s = pool.getOrElse(lang, pool("en"))
    val start = (((docId % s.length) + s.length) % s.length).toInt
    (0 until n).map(i => s((start + i) % s.length)).mkString(" ")
  }
}
